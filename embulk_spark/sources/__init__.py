"""Sources: change-stream synthesis, file inputs (csv/json), config fixtures."""
