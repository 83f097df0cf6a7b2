"""Engine-registered functions beyond the built-in surface: Python
UDTFs (Spark 4 table functions) for imperative per-row expansion."""
