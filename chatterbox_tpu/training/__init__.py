from .train_step import make_train_step, t3_loss

__all__ = ["make_train_step", "t3_loss"]
