"""Console + structured logging.

Reference parity: src/utils/logging.py (Rich console, get_logger, progress,
summary printers). Gated so the framework works without `rich` installed.
"""
from __future__ import annotations

import logging
import sys
from typing import Any, Mapping

try:
    from rich.console import Console
    from rich.logging import RichHandler
    from rich.table import Table

    _HAVE_RICH = True
    console = Console()
except Exception:  # pragma: no cover
    _HAVE_RICH = False
    console = None  # type: ignore

_CONFIGURED: set[str] = set()


def get_logger(name: str = "thyroid_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if name not in _CONFIGURED:
        logger.setLevel(level)
        logger.propagate = False
        if _HAVE_RICH:
            handler: logging.Handler = RichHandler(console=console, show_path=False)
            handler.setFormatter(logging.Formatter("%(message)s", datefmt="[%X]"))
        else:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
            )
        logger.addHandler(handler)
        _CONFIGURED.add(name)
    return logger


def print_table(title: str, rows: Mapping[str, Any]) -> None:
    """Key/value summary table (reference: src/utils/logging.py:73-143)."""
    if _HAVE_RICH:
        table = Table(title=title)
        table.add_column("key", style="cyan")
        table.add_column("value")
        for k, v in rows.items():
            table.add_row(str(k), str(v))
        console.print(table)
    else:  # pragma: no cover
        print(f"== {title} ==")
        for k, v in rows.items():
            print(f"  {k}: {v}")


def print_config_summary(cfg: Any, title: str = "config") -> None:
    flat = dict(cfg.flat_items()) if hasattr(cfg, "flat_items") else dict(cfg)
    print_table(title, flat)
