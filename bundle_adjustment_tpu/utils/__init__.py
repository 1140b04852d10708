"""Host-side support: config presets live in ``bundle_adjustment_tpu.config``;
here are I/O (video/image/PCD), structured logging with the reference's
printed-log grammar, visualization artifacts, and log analytics."""
