"""Input-source readers (SURVEY.md S-family): TSV training triplets, qrels."""
