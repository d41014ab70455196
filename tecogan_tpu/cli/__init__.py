from .main import main, run_train, run_inference

__all__ = ["main", "run_train", "run_inference"]
