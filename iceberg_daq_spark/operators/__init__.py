"""Reusable operator implementations backing the query inventory."""
