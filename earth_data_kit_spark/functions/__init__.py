"""Column-expression builders and vectorized pandas UDFs."""
