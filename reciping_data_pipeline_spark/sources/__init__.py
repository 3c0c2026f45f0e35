"""Source readers and idempotent sinks for the medallion pipeline."""
