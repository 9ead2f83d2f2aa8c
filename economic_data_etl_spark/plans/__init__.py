"""Query catalog.

Importing this package populates the registry from each plan module. The
driver contract (`__spark_entry__.queries()` / `oracle_sql()`) is a thin
view over this registry.
"""

from economic_data_etl_spark.plans.catalog import REGISTRY, Query, register

# Import for registration side effects.
from economic_data_etl_spark.plans import relational  # noqa: E402,F401
from economic_data_etl_spark.plans import relational2  # noqa: E402,F401
from economic_data_etl_spark.plans import relational3  # noqa: E402,F401
from economic_data_etl_spark.plans import relational4  # noqa: E402,F401
from economic_data_etl_spark.plans import relational5  # noqa: E402,F401
from economic_data_etl_spark.plans import relational6  # noqa: E402,F401
from economic_data_etl_spark.plans import profiling  # noqa: E402,F401
from economic_data_etl_spark.plans import quality  # noqa: E402,F401
from economic_data_etl_spark.plans import communities  # noqa: E402,F401
from economic_data_etl_spark.plans import lmppl  # noqa: E402,F401
from economic_data_etl_spark.plans import robustts  # noqa: E402,F401
from economic_data_etl_spark.plans import scd2  # noqa: E402,F401
from economic_data_etl_spark.plans import sketches  # noqa: E402,F401
from economic_data_etl_spark.plans import skewq  # noqa: E402,F401
from economic_data_etl_spark.plans import sql_surface  # noqa: E402,F401
from economic_data_etl_spark.plans import substring_dedup  # noqa: E402,F401
from economic_data_etl_spark.plans import analytics  # noqa: E402,F401
from economic_data_etl_spark.plans import audioq  # noqa: E402,F401
from economic_data_etl_spark.plans import bloomq  # noqa: E402,F401
from economic_data_etl_spark.plans import bpe  # noqa: E402,F401
from economic_data_etl_spark.plans import phash_dedup  # noqa: E402,F401
from economic_data_etl_spark.plans import pii  # noqa: E402,F401
from economic_data_etl_spark.plans import resizeq  # noqa: E402,F401
from economic_data_etl_spark.plans import videoq  # noqa: E402,F401
from economic_data_etl_spark.plans import compressq  # noqa: E402,F401
from economic_data_etl_spark.plans import corpus_stats  # noqa: E402,F401
from economic_data_etl_spark.plans import crawlq  # noqa: E402,F401
from economic_data_etl_spark.plans import curation  # noqa: E402,F401
from economic_data_etl_spark.plans import econometrics  # noqa: E402,F401
from economic_data_etl_spark.plans import invariants  # noqa: E402,F401
from economic_data_etl_spark.plans import jdbc_sink  # noqa: E402,F401
from economic_data_etl_spark.plans import layout  # noqa: E402,F401
from economic_data_etl_spark.plans import linkgraph  # noqa: E402,F401
from economic_data_etl_spark.plans import media_dedup  # noqa: E402,F401
from economic_data_etl_spark.plans import events  # noqa: E402,F401
from economic_data_etl_spark.plans import events2  # noqa: E402,F401
from economic_data_etl_spark.plans import governance  # noqa: E402,F401
from economic_data_etl_spark.plans import graph  # noqa: E402,F401
from economic_data_etl_spark.plans import graph2  # noqa: E402,F401
from economic_data_etl_spark.plans import statistics  # noqa: E402,F401
from economic_data_etl_spark.plans import statistics2  # noqa: E402,F401
from economic_data_etl_spark.plans import text3  # noqa: E402,F401
from economic_data_etl_spark.plans import text4  # noqa: E402,F401
from economic_data_etl_spark.plans import text5  # noqa: E402,F401
from economic_data_etl_spark.plans import fuzzy  # noqa: E402,F401
from economic_data_etl_spark.plans import functions_surface  # noqa: E402,F401
from economic_data_etl_spark.plans import functions_surface2  # noqa: E402,F401
from economic_data_etl_spark.plans import functions_surface3  # noqa: E402,F401
from economic_data_etl_spark.plans import pandas_udfs  # noqa: E402,F401
from economic_data_etl_spark.plans import mlstats  # noqa: E402,F401
from economic_data_etl_spark.plans import classify  # noqa: E402,F401
from economic_data_etl_spark.plans import arforecast  # noqa: E402,F401
from economic_data_etl_spark.plans import textrank  # noqa: E402,F401
from economic_data_etl_spark.plans import survival  # noqa: E402,F401
from economic_data_etl_spark.plans import mmr  # noqa: E402,F401
from economic_data_etl_spark.plans import multimodal  # noqa: E402,F401
from economic_data_etl_spark.plans import text  # noqa: E402,F401
from economic_data_etl_spark.plans import text2  # noqa: E402,F401
from economic_data_etl_spark.plans import textnormq  # noqa: E402,F401
from economic_data_etl_spark.plans import timeseries  # noqa: E402,F401
from economic_data_etl_spark.plans import training  # noqa: E402,F401
from economic_data_etl_spark.plans import unigramq  # noqa: E402,F401
from economic_data_etl_spark.plans import variant  # noqa: E402,F401
from economic_data_etl_spark.plans import vectors  # noqa: E402,F401
from economic_data_etl_spark.plans import vectors2  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
