"""Declared-query modules. Importing them registers into registry.QUERIES."""

from __future__ import annotations

import importlib

_MODULES = (
    "relational",
    "aggregates",
    "windows",
    "warehouse",
    "strings_dates",
    "events",
    "text",
    "similarity",
    "udfs",
    "dedup_ext",
    "multimodal_ext",
    "scale_ext",
    "profiling",
    "analytics_ext",
    "analytics_r5",
    "text_r5",
    "tpch",
    "tpch_ext",
    "warc_ext",
    "wds_ext",
    "curation_r6",
    "curation_r7",
    "curation_r8",
    "profiling_r8",
    "curation_r9",
    "profiling_r9",
    "curation_r10",
    "layout_r10",
    "analytics_r10",
    "events_r10",
    "analytics_r10b",
    "text_r10",
    "vectors_r10",
    "dedup_r10",
    "analytics_r10c",
    "analytics_r10d",
    "events_r10b",
    "dedup_r10b",
    "analytics_r10e",
    "text_r10b",
    "vectors_r10b",
    "analytics_r10f",
    "events_r10c",
    "curation_r10b",
    "analytics_r10g",
    "layout_r10b",
    "analytics_r10h",
    "vectors_r10c",
    "analytics_r12",
    "analytics_r12b",
    "analytics_r12c",
    "analytics_r12d",
    "analytics_r12e",
    "analytics_r12f",
    "analytics_r12g",
    "analytics_r12h",
)


def load() -> None:
    for m in _MODULES:
        importlib.import_module(f"datawarehouse1_spark.queries.{m}")
