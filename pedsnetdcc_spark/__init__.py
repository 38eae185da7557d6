"""pedsnetdcc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PEDSnet/pedsnetdcc.

The reference (https://github.com/PEDSnet/pedsnetdcc) is a SQL-generating ETL
toolkit over PostgreSQL for the OMOP/PEDSnet CDM.  This package re-expresses
every relational transformation it performs as idiomatic PySpark DataFrame
operators — Catalyst replaces both the reference's SQL-generation layer and
the Postgres executor.  See SURVEY.md at the repo root for the operator
inventory this package implements (§2) and the architecture mapping (§1, §4).

Layout
------
- ``session``    — tuned SparkSession builders (local test + cluster posture)
- ``sources``    — table IO: parquet/csv readers & writers, atomic staged publish
- ``operators``  — the relational operators (transform chain, eras, id mapping,
                   merge, subset, integrity checks, interval summaries, …)
- ``functions``  — scalar column-expression libraries (interval months, text
                   analysis, vector math)
- ``datapipe``   — large-scale training-data pipeline ops (dedup, similarity
                   search, multimodal plumbing, text quality)
- ``plans``      — pipeline composition & driver-side parallel job running
- ``streaming``  — incremental/streaming variants of the derivation operators
"""

__version__ = "0.1.0"
