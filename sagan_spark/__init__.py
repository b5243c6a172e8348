"""sagan_spark — a from-scratch PySpark-native log-pipeline engine.

Re-expresses the *capabilities* of the NetWatcher/sagan rule engine
(Snort-syntax rules: content/pcre matchers, field extractors, lookup
enrichment, threshold/after suppression, xbits state, fan-out sinks)
as an idiomatic batch Spark DataFrame pipeline:

    pages -> parse (grok/regex extract) -> match (compiled ruleset)
          -> enrich (broadcast joins) -> gate (window aggs, join-back state)
          -> route (explode -> sink map) -> sinks + per-sink counts

Design notes (SURVEY.md section references in module docstrings):
  * Declarative DataFrame plans everywhere; Catalyst does pushdown,
    pruning and join selection.  Arrow-vectorized pandas UDFs only for
    the multi-regex batch — never per-row Python.
  * Everything is event-time and deterministic: mutable mmap state in
    the reference becomes join-back state tables; rolling counters
    become window aggregates over epoch seconds.
"""

__version__ = "0.1.0"
