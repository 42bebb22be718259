"""Sources: deterministic fixture generators and table readers."""
