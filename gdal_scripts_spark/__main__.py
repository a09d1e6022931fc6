"""``python -m gdal_scripts_spark`` == the spark-submit CLI (cli.py)."""

from .cli import main

raise SystemExit(main(stop_session=True))
