"""hpo subpackage."""
