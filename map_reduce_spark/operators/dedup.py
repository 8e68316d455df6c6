"""(filled in progressively)"""
