"""PySpark-native data-integrity-check engine.

A from-scratch re-expression of the capabilities of
markaugust/IntegrityChecksForVLDBs (a T-SQL integrity-check orchestrator
for Very Large Databases) as an idiomatic PySpark engine, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) that a 100 TB Spark deployment needs.

Layout (see SURVEY.md for the blueprint):

- ``sources/``    catalog metadata DataFrames (databases, objects, files)
- ``functions/``  reusable column expressions (LIKE translation, portable
                  hashes, text metrics, vector math)
- ``operators/``  selection DSL, integrity-check kernels, dedup,
                  similarity, text analysis, multimodal plumbing
- ``plans/``      check specs, runner (CommandExecute analogue), state
                  ledger (CheckTableObjects analogue), scheduler
- ``streaming/``  Structured Streaming freshness/late-data checks
"""

__version__ = "0.1.0"
