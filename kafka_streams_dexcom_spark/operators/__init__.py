"""Operators: reference-parity core ops + scale-oriented extensions."""
