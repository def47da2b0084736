from .main import main, process, CLIState

__all__ = ["main", "process", "CLIState"]
