from .cli import main
from .utils.errors import run

raise SystemExit(run(main))
