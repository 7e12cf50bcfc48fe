"""Scalar/column function library (SURVEY §2.H).

Everything here returns pyspark Column expressions built from built-in
functions — JVM-side, whole-stage-codegen friendly.  Python UDFs are
reserved for the extension operators where no built-in exists."""
