from segtpu.infer.tiled import (
    tiled_predict,
    make_tiled_predictor,
    make_tiled_predictor_many,
)
from segtpu.infer.predict import predict, predict_proba
from segtpu.infer.tta import d4_average_apply, tta_predict, tta_predict_proba
from segtpu.infer.export import (
    ServingModel,
    export_serving,
    load_serving,
    save_serving,
)
