from .render import render_snapshot_figures, render_from_files  # noqa: F401
