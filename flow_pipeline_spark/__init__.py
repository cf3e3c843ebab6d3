"""flow_pipeline_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cloudflare/flow-pipeline.

The reference (/root/reference, snapshot 2024-10-08) is a streaming
network-flow pipeline: protobuf flow records -> Kafka -> {ClickHouse,
Postgres} -> Grafana SQL dashboards.  This package re-expresses the same
semantics Spark-first:

- ``schema``       canonical flow schemas (pb-ext/flow.proto:7-65 field set)
- ``session``      SparkSession factory tuned for the target cluster
- ``functions``    IP/format expression library (viz-ch.json:233,479 semantics)
- ``sources``      table loaders, synthetic flow generator (mocker/mocker.go),
                   kafka/protobuf edges (gated on availability)
- ``operators``    rollups, top-k, dedup, text QC, similarity search
- ``plans``        the SURVEY.md §2 query inventory as DataFrame builders +
                   matching DuckDB oracle SQL
- ``streaming``    structured-streaming jobs (raw persist, 5m rollup,
                   compaction) mirroring the reference's MV cascade
"""

__version__ = "0.1.0"
