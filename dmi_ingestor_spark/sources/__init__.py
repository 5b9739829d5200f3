"""Source adapters (SURVEY.md §2.1): HTTP-EDR fetch, cube decode, parquet."""
