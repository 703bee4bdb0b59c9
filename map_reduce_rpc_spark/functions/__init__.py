"""Reusable column-level transforms (all JVM-side built-ins unless noted)."""
