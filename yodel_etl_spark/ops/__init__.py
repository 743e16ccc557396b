"""Reusable engine operators — pure DataFrame→DataFrame / Column algebra.

Every operator here compiles to built-in Catalyst expressions (CASE WHEN,
rlike, higher-order array functions, from_json) — whole-stage codegen,
no Python in the hot path.
"""
