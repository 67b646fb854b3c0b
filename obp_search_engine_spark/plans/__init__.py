"""Declarative query builders: the reference's API surface re-expressed as
DataFrame plans (search.py) and the driver-graded testdata query registry
(testdata_queries.py)."""
