"""Shared utilities (config, logging, misc)."""
