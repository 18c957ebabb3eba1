"""Scalar column-function library (JVM-side built-ins wherever possible)."""
