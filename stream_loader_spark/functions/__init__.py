"""Column-expression function library: constrained encoding, CSV line
formatting, retry helpers."""
