"""Stateful structures held in actor-pool state (SURVEY.md §2.4)."""
