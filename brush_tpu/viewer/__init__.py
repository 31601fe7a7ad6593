"""Live web viewer (reference: crates/brush-viewer).

The reference ships an egui desktop/wasm/Android app; the TPU-native
equivalent is a small HTTP server + browser page: the training loop runs in
a background thread driven by a control-message queue (mirroring
train_loop.rs's channel protocol), and the browser drives an orbit camera
whose frames are rendered on-device through the u32 display path.
"""

from brush_tpu.viewer.server import ViewerServer, run_viewer

__all__ = ["ViewerServer", "run_viewer"]
