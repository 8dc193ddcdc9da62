"""Support utilities: checkpointing, recording/metrics logging, export."""
