"""Column-expression libraries.

Everything here returns ``pyspark.sql.Column`` built from native
functions (JVM-side, whole-stage-codegen eligible). Python/pandas
UDFs live in :mod:`.udfs` only — keep the hot path native.
"""
