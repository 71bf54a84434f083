"""PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the capabilities of
``platformbuilds/opentelemetry-collector-contrib`` (the OpenTelemetry
Collector component library) as an idiomatic PySpark engine:
parse -> transform/enrich -> route -> aggregate -> export over
DataFrames, with Catalyst/AQE doing the physical planning the Go
reference does by hand.

Layout:
    model        log-record data model + severity enum (pdata analog)
    session      SparkSession builder tuned for the pipeline
    sources/     input adapters + deterministic transcript generator
    operators/   parse / transform / enrich / route / aggregate /
                 dedup / text / similarity operators (stanza +
                 processor + connector semantics)
    functions/   OTTL-style scalar function surface as Column builders
    plans/       pipeline composition (config -> DataFrame DAG)
    streaming/   Structured Streaming variants
    runtime/     lineage / resume / sink writers

The reference is row-at-a-time interpreted Go; everything here is
declarative Column expressions so Catalyst supplies predicate pushdown,
column pruning, partial aggregation, broadcast planning, AQE skew
mitigation, and whole-stage codegen.
"""

__version__ = "0.1.0"
