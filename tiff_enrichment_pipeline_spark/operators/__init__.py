"""Relational + spatial operators (DataFrame-first; UDFs only for geometry
refinement and pixel math)."""
