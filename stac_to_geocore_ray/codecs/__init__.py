"""Deterministic image codec + perceptual hashing (no PIL/cv2 in env)."""
