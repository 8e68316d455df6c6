"""Operator inventory — each module registers queries with the registry."""
