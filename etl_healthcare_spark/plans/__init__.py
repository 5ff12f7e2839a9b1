"""The query surface: serving queries (Q1-Q6) and the analytics layer
(aggregations, joins, windows, set ops, sort/limit/pagination)."""
