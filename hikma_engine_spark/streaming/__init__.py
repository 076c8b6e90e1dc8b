# streaming ingestion layer (optional — the reference is strictly batch;
# SURVEY.md §2.9)
