"""recrun_spark — PySpark-native KG-construction engine (see SURVEY.md)."""
__version__ = "0.1.0"
