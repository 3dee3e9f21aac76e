"""Sources: corpus synthesis + table loading."""
