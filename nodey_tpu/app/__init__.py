"""Application layer: headless CLI, project IO, editing session services."""
