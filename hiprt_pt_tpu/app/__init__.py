from .cli import main as cli_main
from .screenshot import auto_filename, screenshot
from .viewer import ViewerServer

__all__ = ["cli_main", "auto_filename", "screenshot", "ViewerServer"]
