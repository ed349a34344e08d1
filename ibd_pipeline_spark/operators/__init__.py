"""Reusable operator implementations (column builders + DataFrame
transforms) behind the query registry.

Everything here is built from pyspark.sql.functions primitives so it
stays JVM-side inside whole-stage codegen; Python (pandas_udf /
mapInPandas) appears only where semantics require it (multimodal
decode stubs, ANN re-ranking).
"""
