"""Column-expression libraries.

Everything here returns ``pyspark.sql.Column`` built from native
functions (JVM-side, whole-stage-codegen eligible). The only
non-native seams are the SURVEY-sanctioned pandas UDF in
:mod:`.cleaning` (P4 surrogate normalize) and its masked Arrow JSON
unwrap — keep the hot path native.
"""
