"""Structured Streaming surface.

The reference approximates near-real-time with a 15-minute Airflow
micro-batch (SURVEY §2.9 — no Structured Streaming anywhere). This
package provides the true streaming equivalent on the same engine
code: file-source ``readStream`` over the staging directory,
``foreachBatch`` reusing the batch silver/gold transforms unchanged,
``Trigger.AvailableNow`` for bounded catch-up runs,
``dropDuplicatesWithinWatermark`` for cross-batch event dedup, and
event-time session windows (the reference only has generator-assigned
session ids).
"""
