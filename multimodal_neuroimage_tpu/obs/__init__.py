"""obs subpackage."""
