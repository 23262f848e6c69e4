"""pyspark-linkgraph-engine: a PySpark-native link-graph analytics engine.

Built from scratch on pyspark.sql DataFrames + vectorized Arrow UDFs with the
query/data-processing capabilities of the reference hackathon web-search system
(begum-kara/Hackathon-PageRank). See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
