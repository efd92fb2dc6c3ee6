from . import enhance, onnx_dump, onnx_export, onnx_import, onnx_proto, onnx_runner  # noqa: F401
from .enhance import default_enhance_fn, enhance_from_onnx, make_enhance_fn  # noqa: F401
from .onnx_import import import_any, import_conv_stack, import_pix_shuffle  # noqa: F401
