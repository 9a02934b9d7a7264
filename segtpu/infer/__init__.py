from segtpu.infer.tiled import (
    tiled_predict,
    make_tiled_predictor,
    make_tiled_predictor_many,
)
from segtpu.infer.predict import predict, predict_proba
