from .logging import get_logger, console, print_table, print_config_summary

__all__ = ["get_logger", "console", "print_table", "print_config_summary"]
