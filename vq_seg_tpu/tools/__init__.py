"""Offline dataset-prep tooling (reference saliency_map/, deprecated/obia_*):
saliency maps, SLIC superpixels, OBIA pseudo-labels."""
