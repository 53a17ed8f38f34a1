! Fortran coupling module for rdycore_tpu: iso_c_binding mirror of the
! embedded C API (csrc/capi.c), the analogue of the reference's
! src/f90-mod/rdycore.F90 over include/rdycore.h. An E3SM-style Fortran
! host links librdycore_tpu_capi.so and drives the same per-interval
! coupling loop as the reference's driver/main.F90:
!
!   call rdytpu_init(ierr)
!   call rdytpu_create("config.yaml", rdy, ierr)
!   do while (.not. rdytpu_is_finished(rdy))
!     call rdytpu_set_domain_water_source(rdy, rain, n, ierr)
!     call rdytpu_advance(rdy, ierr)
!     call rdytpu_get_height(rdy, h, n, ierr)
!   end do
!   call rdytpu_destroy(rdy, ierr)
!
! (This file is source-shipped for the host's compiler; the repo's test
! suite compile-checks it when gfortran is available and always runs the
! C twin csrc/test_capi.c.)

module rdycore_tpu
  use, intrinsic :: iso_c_binding
  implicit none
  private

  public :: rdytpu_init, rdytpu_finalize, rdytpu_create, rdytpu_destroy, &
            rdytpu_advance, rdytpu_is_finished, rdytpu_get_time, &
            rdytpu_get_time_step, rdytpu_get_step, rdytpu_get_num_cells, &
            rdytpu_get_height, rdytpu_get_x_momentum, &
            rdytpu_get_y_momentum, rdytpu_get_cell_areas, &
            rdytpu_get_natural_ids, rdytpu_set_domain_water_source, &
            rdytpu_set_regional_water_source, &
            rdytpu_set_flow_dirichlet_boundary_values, &
            rdytpu_get_num_boundary_edges, &
            rdytpu_write_checkpoint, rdytpu_read_checkpoint, &
            rdytpu_convert_time, rdytpu_get_num_boundary_conditions, &
            rdytpu_get_boundary_id, &
            rdytpu_get_boundary_condition_flow_type, &
            rdytpu_get_boundary_edge_centroids, rdytpu_get_solution, &
            rdytpu_set_initial_conditions, rdytpu_read_one_dof_vec, &
            rdytpu_write_one_dof_vec, rdytpu_get_cell_centroids, &
            rdytpu_get_manning_n, rdytpu_set_manning_n, &
            rdytpu_get_coupling_interval, rdytpu_set_coupling_interval, &
            rdytpu_get_version

  interface
    function c_rdytpu_init() bind(c, name="rdytpu_init") result(ierr)
      import :: c_int
      integer(c_int) :: ierr
    end function

    function c_rdytpu_finalize() bind(c, name="rdytpu_finalize") &
        result(ierr)
      import :: c_int
      integer(c_int) :: ierr
    end function

    function c_rdytpu_create(path, handle) bind(c, name="rdytpu_create") &
        result(ierr)
      import :: c_char, c_int, c_int64_t
      character(kind=c_char), intent(in) :: path(*)
      integer(c_int64_t), intent(out) :: handle
      integer(c_int) :: ierr
    end function

    function c_rdytpu_destroy(handle) bind(c, name="rdytpu_destroy") &
        result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int) :: ierr
    end function

    function c_rdytpu_advance(handle) bind(c, name="rdytpu_advance") &
        result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int) :: ierr
    end function

    function c_rdytpu_finished(handle, done) &
        bind(c, name="rdytpu_finished") result(ierr)
      import :: c_int, c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t), intent(out) :: done
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_time(handle, t) bind(c, name="rdytpu_get_time") &
        result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: t
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_time_step(handle, dt) &
        bind(c, name="rdytpu_get_time_step") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: dt
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_step(handle, n) bind(c, name="rdytpu_get_step") &
        result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int64_t), intent(out) :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_num_cells(handle, n) &
        bind(c, name="rdytpu_get_num_cells") result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int64_t), intent(out) :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_num_boundary_edges(handle, boundary, n) &
        bind(c, name="rdytpu_get_num_boundary_edges") result(ierr)
      import :: c_char, c_int, c_int64_t
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: boundary(*)
      integer(c_int64_t), intent(out) :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_height(handle, out, n) &
        bind(c, name="rdytpu_get_height") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_x_momentum(handle, out, n) &
        bind(c, name="rdytpu_get_x_momentum") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_y_momentum(handle, out, n) &
        bind(c, name="rdytpu_get_y_momentum") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_cell_areas(handle, out, n) &
        bind(c, name="rdytpu_get_cell_areas") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_natural_ids(handle, out, n) &
        bind(c, name="rdytpu_get_natural_ids") result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int64_t), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_domain_water_source(handle, rate, n) &
        bind(c, name="rdytpu_set_domain_water_source") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(in) :: rate(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_regional_water_source(handle, region, rate, n) &
        bind(c, name="rdytpu_set_regional_water_source") result(ierr)
      import :: c_char, c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: region(*)
      real(c_double), intent(in) :: rate(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_write_checkpoint(handle, path) &
        bind(c, name="rdytpu_write_checkpoint") result(ierr)
      import :: c_char, c_int, c_int64_t
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: path(*)
      integer(c_int) :: ierr
    end function

    function c_rdytpu_read_checkpoint(handle, path) &
        bind(c, name="rdytpu_read_checkpoint") result(ierr)
      import :: c_char, c_int, c_int64_t
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: path(*)
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_flow_dirichlet(handle, boundary, values, n) &
        bind(c, name="rdytpu_set_flow_dirichlet_boundary_values") &
        result(ierr)
      import :: c_char, c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: boundary(*)
      real(c_double), intent(in) :: values(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_convert_time(unit_from, t, unit_to, out) &
        bind(c, name="rdytpu_convert_time") result(ierr)
      import :: c_char, c_int, c_double
      character(kind=c_char), intent(in) :: unit_from(*), unit_to(*)
      real(c_double), value :: t
      real(c_double), intent(out) :: out
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_num_bcs(handle, n) &
        bind(c, name="rdytpu_get_num_boundary_conditions") result(ierr)
      import :: c_int, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int64_t), intent(out) :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_boundary_id(handle, boundary, id) &
        bind(c, name="rdytpu_get_boundary_id") result(ierr)
      import :: c_char, c_int, c_int64_t
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: boundary(*)
      integer(c_int64_t), intent(out) :: id
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_bc_flow_type(handle, boundary, bc_type) &
        bind(c, name="rdytpu_get_boundary_condition_flow_type") &
        result(ierr)
      import :: c_char, c_int, c_int64_t, c_int32_t
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: boundary(*)
      integer(c_int32_t), intent(out) :: bc_type
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_bnd_edge_centroids(handle, boundary, out, n) &
        bind(c, name="rdytpu_get_boundary_edge_centroids") result(ierr)
      import :: c_char, c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: boundary(*)
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_solution(handle, out, n) &
        bind(c, name="rdytpu_get_solution") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_initial_conditions(handle, q, n) &
        bind(c, name="rdytpu_set_initial_conditions") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(in) :: q(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_read_one_dof_vec(handle, path, out, n) &
        bind(c, name="rdytpu_read_one_dof_vec") result(ierr)
      import :: c_char, c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: path(*)
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_write_one_dof_vec(handle, path, vals, n) &
        bind(c, name="rdytpu_write_one_dof_vec") result(ierr)
      import :: c_char, c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      character(kind=c_char), intent(in) :: path(*)
      real(c_double), intent(in) :: vals(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_cell_centroids(handle, out, n) &
        bind(c, name="rdytpu_get_cell_centroids") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_manning_n(handle, out, n) &
        bind(c, name="rdytpu_get_manning_n") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_manning_n(handle, nval, n) &
        bind(c, name="rdytpu_set_manning_n") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(in) :: nval(*)
      integer(c_int64_t), value :: n
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_coupling_interval(handle, ci) &
        bind(c, name="rdytpu_get_coupling_interval") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: ci
      integer(c_int) :: ierr
    end function

    function c_rdytpu_set_coupling_interval(handle, ci) &
        bind(c, name="rdytpu_set_coupling_interval") result(ierr)
      import :: c_int, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), value :: ci
      integer(c_int) :: ierr
    end function

    function c_rdytpu_get_version(buf, max_bytes) &
        bind(c, name="rdytpu_get_version") result(ierr)
      import :: c_char, c_int, c_int64_t
      character(kind=c_char), intent(out) :: buf(*)
      integer(c_int64_t), value :: max_bytes
      integer(c_int) :: ierr
    end function
  end interface

contains

  function cstr(f) result(c)
    character(len=*), intent(in) :: f
    character(kind=c_char, len=:), allocatable :: c
    c = trim(f) // c_null_char
  end function

  subroutine rdytpu_init(ierr)
    integer, intent(out) :: ierr
    ierr = c_rdytpu_init()
  end subroutine

  subroutine rdytpu_finalize(ierr)
    integer, intent(out) :: ierr
    ierr = c_rdytpu_finalize()
  end subroutine

  subroutine rdytpu_create(config_path, rdy, ierr)
    character(len=*), intent(in) :: config_path
    integer(c_int64_t), intent(out) :: rdy
    integer, intent(out) :: ierr
    ierr = c_rdytpu_create(cstr(config_path), rdy)
  end subroutine

  subroutine rdytpu_destroy(rdy, ierr)
    integer(c_int64_t), value :: rdy
    integer, intent(out) :: ierr
    ierr = c_rdytpu_destroy(rdy)
  end subroutine

  subroutine rdytpu_advance(rdy, ierr)
    integer(c_int64_t), value :: rdy
    integer, intent(out) :: ierr
    ierr = c_rdytpu_advance(rdy)
  end subroutine

  function rdytpu_is_finished(rdy) result(done)
    integer(c_int64_t), value :: rdy
    logical :: done
    integer(c_int32_t) :: d
    integer :: ierr
    ierr = c_rdytpu_finished(rdy, d)
    done = (ierr /= 0) .or. (d /= 0)
  end function

  subroutine rdytpu_get_time(rdy, t, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: t
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_time(rdy, t)
  end subroutine

  subroutine rdytpu_get_time_step(rdy, dt, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: dt
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_time_step(rdy, dt)
  end subroutine

  subroutine rdytpu_get_step(rdy, n, ierr)
    integer(c_int64_t), value :: rdy
    integer(c_int64_t), intent(out) :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_step(rdy, n)
  end subroutine

  subroutine rdytpu_get_num_cells(rdy, n, ierr)
    integer(c_int64_t), value :: rdy
    integer(c_int64_t), intent(out) :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_num_cells(rdy, n)
  end subroutine

  subroutine rdytpu_get_num_boundary_edges(rdy, boundary, n, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: boundary
    integer(c_int64_t), intent(out) :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_num_boundary_edges(rdy, cstr(boundary), n)
  end subroutine

  subroutine rdytpu_get_height(rdy, h, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: h(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_height(rdy, h, n)
  end subroutine

  subroutine rdytpu_get_x_momentum(rdy, hu, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: hu(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_x_momentum(rdy, hu, n)
  end subroutine

  subroutine rdytpu_get_y_momentum(rdy, hv, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: hv(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_y_momentum(rdy, hv, n)
  end subroutine

  subroutine rdytpu_get_cell_areas(rdy, a, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: a(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_cell_areas(rdy, a, n)
  end subroutine

  subroutine rdytpu_get_natural_ids(rdy, ids, n, ierr)
    integer(c_int64_t), value :: rdy
    integer(c_int64_t), intent(out) :: ids(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_natural_ids(rdy, ids, n)
  end subroutine

  subroutine rdytpu_set_domain_water_source(rdy, rate, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(in) :: rate(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_domain_water_source(rdy, rate, n)
  end subroutine

  subroutine rdytpu_set_regional_water_source(rdy, region, rate, n, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: region
    real(c_double), intent(in) :: rate(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_regional_water_source(rdy, cstr(region), rate, n)
  end subroutine

  subroutine rdytpu_write_checkpoint(rdy, path, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: path
    integer, intent(out) :: ierr
    ierr = c_rdytpu_write_checkpoint(rdy, cstr(path))
  end subroutine

  subroutine rdytpu_read_checkpoint(rdy, path, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: path
    integer, intent(out) :: ierr
    ierr = c_rdytpu_read_checkpoint(rdy, cstr(path))
  end subroutine

  subroutine rdytpu_set_flow_dirichlet_boundary_values( &
      rdy, boundary, values, n_edges, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: boundary
    real(c_double), intent(in) :: values(:)  ! n_edges*3, edge-major
    integer(c_int64_t), value :: n_edges
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_flow_dirichlet(rdy, cstr(boundary), values, n_edges)
  end subroutine

  subroutine rdytpu_convert_time(unit_from, t, unit_to, out, ierr)
    character(len=*), intent(in) :: unit_from, unit_to
    real(c_double), value :: t
    real(c_double), intent(out) :: out
    integer, intent(out) :: ierr
    ierr = c_rdytpu_convert_time(cstr(unit_from), t, cstr(unit_to), out)
  end subroutine

  subroutine rdytpu_get_num_boundary_conditions(rdy, n, ierr)
    integer(c_int64_t), value :: rdy
    integer(c_int64_t), intent(out) :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_num_bcs(rdy, n)
  end subroutine

  subroutine rdytpu_get_boundary_id(rdy, boundary, id, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: boundary
    integer(c_int64_t), intent(out) :: id
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_boundary_id(rdy, cstr(boundary), id)
  end subroutine

  subroutine rdytpu_get_boundary_condition_flow_type(rdy, boundary, &
      bc_type, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: boundary
    integer(c_int32_t), intent(out) :: bc_type
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_bc_flow_type(rdy, cstr(boundary), bc_type)
  end subroutine

  subroutine rdytpu_get_boundary_edge_centroids(rdy, boundary, xyz, &
      n_edges, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: boundary
    real(c_double), intent(out) :: xyz(:)  ! n_edges*3, edge-major
    integer(c_int64_t), value :: n_edges
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_bnd_edge_centroids(rdy, cstr(boundary), xyz, &
                                           n_edges)
  end subroutine

  subroutine rdytpu_get_solution(rdy, q, n_values, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: q(:)  ! ndof*num_cells, cell-major interleaved (blocksize ndof, PETSc Vec layout)
    integer(c_int64_t), value :: n_values
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_solution(rdy, q, n_values)
  end subroutine

  subroutine rdytpu_set_initial_conditions(rdy, q, n_values, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(in) :: q(:)
    integer(c_int64_t), value :: n_values
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_initial_conditions(rdy, q, n_values)
  end subroutine

  subroutine rdytpu_read_one_dof_vec(rdy, path, vals, n, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: path
    real(c_double), intent(out) :: vals(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_read_one_dof_vec(rdy, cstr(path), vals, n)
  end subroutine

  subroutine rdytpu_write_one_dof_vec(rdy, path, vals, n, ierr)
    integer(c_int64_t), value :: rdy
    character(len=*), intent(in) :: path
    real(c_double), intent(in) :: vals(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_write_one_dof_vec(rdy, cstr(path), vals, n)
  end subroutine


  subroutine rdytpu_get_cell_centroids(rdy, xyz, n_values, ierr)
    ! [n_cells, 3] row-major (x, y, z) centroids; n_values = 3 * n_cells
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: xyz(:)
    integer(c_int64_t), value :: n_values
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_cell_centroids(rdy, xyz, n_values)
  end subroutine

  subroutine rdytpu_get_manning_n(rdy, nval, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: nval(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_manning_n(rdy, nval, n)
  end subroutine

  subroutine rdytpu_set_manning_n(rdy, nval, n, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(in) :: nval(:)
    integer(c_int64_t), value :: n
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_manning_n(rdy, nval, n)
  end subroutine

  subroutine rdytpu_get_coupling_interval(rdy, ci, ierr)
    ! interval in the config file's time unit (RDyGetCouplingInterval)
    integer(c_int64_t), value :: rdy
    real(c_double), intent(out) :: ci
    integer, intent(out) :: ierr
    ierr = c_rdytpu_get_coupling_interval(rdy, ci)
  end subroutine

  subroutine rdytpu_set_coupling_interval(rdy, ci, ierr)
    integer(c_int64_t), value :: rdy
    real(c_double), value :: ci
    integer, intent(out) :: ierr
    ierr = c_rdytpu_set_coupling_interval(rdy, ci)
  end subroutine

  subroutine rdytpu_get_version(version, ierr)
    ! version string, blank-padded (RDyGetVersion)
    character(len=*), intent(out) :: version
    integer, intent(out) :: ierr
    character(kind=c_char) :: buf(64)
    integer :: i
    ierr = c_rdytpu_get_version(buf, int(64, c_int64_t))
    version = ""
    do i = 1, min(len(version), 64)
      if (buf(i) == c_null_char) exit
      version(i:i) = buf(i)
    end do
  end subroutine

end module rdycore_tpu
