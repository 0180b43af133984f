"""Host utilities: structured logging, timing, debug image dumps."""
