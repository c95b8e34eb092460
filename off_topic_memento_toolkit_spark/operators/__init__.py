"""DataFrame operators: timelines, measures, curation, dedup-at-scale."""
