"""``python -m sketchyscenecolorization_tpu`` runs the interactive
color/withdraw CLI (see ``cli.py``)."""
from .cli import main

raise SystemExit(main())
