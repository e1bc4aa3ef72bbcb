"""Multi-node training: tree-partitioned XR-Linear over a host comm layer."""
