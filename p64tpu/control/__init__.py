"""p64tpu subpackage."""
