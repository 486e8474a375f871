"""The NHL analytics pipeline: the reference's dbt model DAG, Spark-first.

Module layout mirrors the medallion layers (reference: dbt_nhl/models/):
bronze (raw snapshot envelopes) → staging (typed, deduped, flattened) →
silver dims/facts → metric views → odds vertical. Each dbt model is a pure
function DataFrame(s) -> DataFrame; `pipeline.py` materializes them in
dependency order with the reference's view/table policy.
"""
