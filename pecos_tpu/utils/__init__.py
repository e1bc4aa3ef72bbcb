"""Host-side utilities: sparse matrix toolkit, cluster chains, featurization."""
