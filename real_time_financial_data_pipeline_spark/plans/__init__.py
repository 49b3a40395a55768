"""Pre-built analytic plans over the star schema: the join/aggregate
capability layer (the reference declares cross-dataset analysis but ships no
joins — SURVEY.md §2.7/§2.9)."""
