"""Physical-plan inspection and plan-quality assertions."""
