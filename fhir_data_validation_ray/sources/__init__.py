"""Sources: deterministic fixture generation + dataset readers."""
