"""Host-side utility functions (activation set, phenotype mappers)."""
