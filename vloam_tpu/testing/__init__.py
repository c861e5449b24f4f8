"""Reference-semantics oracles for parity testing (NumPy, no JAX)."""
