"""The Spark-native ingestion pipeline (SURVEY.md §7 M2)."""
