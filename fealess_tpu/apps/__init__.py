"""Application layer: CLI actions, mesh overlay, evaluation metrics
(reference test/ directory, SURVEY.md §2.5)."""
