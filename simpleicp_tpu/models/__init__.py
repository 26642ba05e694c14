"""Registration models: the ICP pipeline and its Gauss-Newton solver."""

from .solver import Parameter, RigidBodyParameters
from .icp import IcpResult, icp_register

__all__ = ["Parameter", "RigidBodyParameters", "IcpResult", "icp_register"]
