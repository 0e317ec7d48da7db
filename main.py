"""Bases-pipeline entry point (reference ``main.py`` equivalent).

Usage:
    python main.py --config_file configs/examples/<exp>.json
"""

from animsnapbases_tpu.cli import cli

if __name__ == "__main__":
    cli()
