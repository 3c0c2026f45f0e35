"""All StructTypes for the medallion layers.

Wire schema (SURVEY §1.2): one flat JSON object per line with two
double-encoded JSON-string payloads, ``context`` and
``event_properties`` — parsing is schema-on-read with three explicit
StructTypes (reference: ``spark/replay_jobs/
replay_bronze_to_silver.py:109-146``). Unknown payload properties are
intentionally dropped by the fixed extraction (schemaless payload,
fixed projection).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Event envelope: all fields arrive as strings; typing happens in Silver.
ENVELOPE_SCHEMA = StructType(
    [
        StructField("anonymous_id", StringType(), True),
        StructField("context", StringType(), True),  # nested JSON as string
        StructField("date", StringType(), True),
        StructField("event_id", StringType(), True),
        StructField("event_name", StringType(), True),
        StructField("event_properties", StringType(), True),  # nested JSON as string
        StructField("session_id", StringType(), True),
        StructField("timestamp", StringType(), True),  # ISO-8601 +09:00 with millis
        StructField("user_id", StringType(), True),
    ]
)

CONTEXT_SCHEMA = StructType(
    [
        StructField(
            "page",
            StructType(
                [
                    StructField("name", StringType(), True),
                    StructField("url", StringType(), True),
                    StructField("path", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("user_segment", StringType(), True),
        StructField("activity_level", StringType(), True),
        StructField("cooking_style", StringType(), True),
        StructField(
            "ab_test",
            StructType(
                [
                    StructField("scenario", StringType(), True),
                    StructField("group", StringType(), True),
                    StructField("start_date", StringType(), True),
                    StructField("end_date", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

EVENT_PROPERTIES_SCHEMA = StructType(
    [
        StructField("page_name", StringType(), True),
        StructField("referrer", StringType(), True),
        StructField("recipe_id", StringType(), True),
        StructField("list_type", StringType(), True),
        StructField("action", StringType(), True),
        StructField("search_keyword", StringType(), True),
        StructField("result_count", IntegerType(), True),
    ]
)

# The 13 event types with conversion/engagement semantics downstream.
EVENT_NAMES = (
    "view_page",
    "click_auth_button",
    "auth_success",
    "search_recipe",
    "view_recipe_list",
    "click_recipe",
    "click_bookmark",
    "click_like",
    "create_comment",
    "create_recipe_success",
    "view_ads",
    "click_ads",
    "view_recipe",
)

CONVERSION_EVENTS = ("auth_success", "click_bookmark", "create_comment")

# Engagement ladder (replay_silver_to_gold.py:371-378).
ENGAGEMENT_SCORES = {
    "auth_success": 10.0,
    "create_comment": 9.0,
    "click_bookmark": 8.0,
    "click_recipe": 7.0,
    "search_recipe": 5.0,
    "view_recipe": 4.0,
    "view_page": 2.0,
}

SILVER_COLUMNS = (
    "event_id",
    "event_name",
    "user_id",
    "anonymous_id",
    "session_id",
    "kst_timestamp",
    "utc_timestamp",
    "date",
    "year",
    "month",
    "day",
    "hour",
    "day_of_week",
    "page_name",
    "page_url",
    "user_segment",
    "cooking_style",
    "ab_test_group",
    "prop_recipe_id",
    "prop_list_type",
    "prop_action",
    "prop_search_keyword",
    "prop_result_count",
    "data_source",
    "processed_at",
    "pipeline_version",
)
