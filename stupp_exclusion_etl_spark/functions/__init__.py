"""Scalar/column function library (JVM-side expressions first, pandas
UDFs only where built-ins can't express the semantics)."""
