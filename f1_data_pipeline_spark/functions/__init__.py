"""Expression helpers — JVM-side built-ins first, never row-wise Python UDFs."""
