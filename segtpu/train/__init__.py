from segtpu.train.optim import (torch_adam, make_optimizer,
                                ReduceLROnPlateau, EarlyStopping)
from segtpu.train.engine import TrainEngine, TrainState, get_engine
from segtpu.train.loop import train_model, quick_train, train_epoch, evaluate, plot_training_history
from segtpu.train.checkpoint import save_checkpoint, load_checkpoint
