"""Custom operators that need more than a single Catalyst expression."""
