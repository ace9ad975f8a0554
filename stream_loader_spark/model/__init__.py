"""Core stream model: positions, ranges, intervals, watermarks, tokens.

Pure-Python (no Spark dependency) so it is unit-testable with hypothesis
and usable from both driver-side sink code and tests.
"""
