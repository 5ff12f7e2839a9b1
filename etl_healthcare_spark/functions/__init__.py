"""Column-expression helper libraries (pure functions returning Column).

These are the engine's only "custom expressions" — plain compositions of
built-in pyspark.sql.functions so whole-stage codegen applies (SURVEY §4:
no custom Catalyst rules needed).
"""
