Feature: TemporalAndLists

  Scenario: Date property accessors
    Given an empty graph
    And having executed:
      """
      CREATE (:E {d: date('2024-03-15')})
      """
    When executing query:
      """
      MATCH (e:E)
      RETURN e.d.year AS y, e.d.month AS m, e.d.day AS d, e.d.quarter AS q
      """
    Then the result should be, in any order:
      | y    | m | d  | q |
      | 2024 | 3 | 15 | 1 |
    And no side effects

  Scenario: Duration from ISO string and accessors
    Given an empty graph
    When executing query:
      """
      RETURN duration('P1DT2H30M').days AS d, duration('P1DT2H30M').hours AS h,
             duration('P1DT2H30M').minutesOfHour AS m
      """
    Then the result should be, in any order:
      | d | h | m  |
      | 1 | 2 | 30 |
    And no side effects

  Scenario: duration.between dates
    Given an empty graph
    When executing query:
      """
      RETURN duration.between(date('2024-01-01'), date('2024-01-11')).days AS d
      """
    Then the result should be, in any order:
      | d  |
      | 10 |
    And no side effects

  Scenario: List comprehension with filter and map
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS xs
      """
    Then the result should be, in any order:
      | xs           |
      | [20, 40, 60] |
    And no side effects

  Scenario: reduce and list predicates
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s,
             any(x IN [1, 2] WHERE x > 1) AS a,
             all(x IN [1, 2] WHERE x > 0) AS b,
             none(x IN [1, 2] WHERE x > 5) AS c
      """
    Then the result should be, in any order:
      | s | a    | b    | c    |
      | 6 | true | true | true |
    And no side effects

  Scenario: List slicing and indexing
    Given an empty graph
    When executing query:
      """
      WITH [10, 20, 30, 40] AS xs
      RETURN xs[0] AS first, xs[1..3] AS mid, xs[-1] AS last_elem
      """
    Then the result should be, in any order:
      | first | mid      | last_elem |
      | 10    | [20, 30] | 40        |
    And no side effects

  Scenario: IN with null element semantics
    Given an empty graph
    When executing query:
      """
      RETURN 2 IN [1, 2] AS yes, 3 IN [1, 2] AS no
      """
    Then the result should be, in any order:
      | yes  | no    |
      | true | false |
    And no side effects
