"""Pipeline stages as pure ``DataFrame -> DataFrame`` functions.

Each module mirrors one reference stage (or stage family) and is
composed by the driver — no subprocess-per-stage, one SparkSession,
lineage recorded by :mod:`..sources.manifest`.
"""
