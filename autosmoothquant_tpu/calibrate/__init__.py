from .calibrate import calibrate, calibration_batches

__all__ = ["calibrate", "calibration_batches"]
