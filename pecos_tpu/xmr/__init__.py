"""XMR: extreme multi-label ranking (reranker stack)."""
