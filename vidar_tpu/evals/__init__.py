from .metrics import (render_pcds, chamfer_distance_inner, compute_ray_errors,
                      forecast_metrics, aggregate_frame_metrics)
