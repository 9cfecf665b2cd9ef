"""Scalar / higher-order expression helpers shared by operators.

Everything here returns Catalyst Column expressions (JVM-side,
codegen-able) — no Python UDFs.
"""
