from coponerf_tpu.models.coponerf import CoPoNeRF, SceneState
