"""Reusable column expressions shared across operators."""

from eecs485_p4_mapreduce_spark.functions.numeric import dsum, davg
from eecs485_p4_mapreduce_spark.functions.textfn import tokens, shingles

__all__ = ["dsum", "davg", "tokens", "shingles"]
