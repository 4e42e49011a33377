"""Transactional table storage (SURVEY.md §2.1 S3-S5)."""
