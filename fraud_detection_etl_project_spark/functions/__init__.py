"""Column-expression helpers (all Catalyst-native; no Python UDFs)."""
