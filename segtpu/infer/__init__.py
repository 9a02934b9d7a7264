from segtpu.infer.tiled import tiled_predict, make_tiled_predictor
from segtpu.infer.predict import predict, predict_proba
