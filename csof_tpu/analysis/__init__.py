"""Post-hoc cardiac analysis: jacobian, strain, contour tracking, SSIM."""
