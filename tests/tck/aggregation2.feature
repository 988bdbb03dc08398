Feature: Aggregation2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:Emp {name: 'a', dept: 'x', salary: 10, years: 1}),
             (:Emp {name: 'b', dept: 'x', salary: 20, years: 3}),
             (:Emp {name: 'c', dept: 'y', salary: 30, years: 5}),
             (:Emp {name: 'd', dept: 'y', salary: 40}),
             (:Emp {name: 'e', dept: 'y', salary: 40, years: 2})
      """

  Scenario: Count star groups by the non-aggregated column
    When executing query:
      """
      MATCH (e:Emp) RETURN e.dept AS dept, count(*) AS n
      """
    Then the result should be, in any order:
      | dept | n |
      | 'x'  | 2 |
      | 'y'  | 3 |
    And no side effects

  Scenario: count on a property skips nulls
    When executing query:
      """
      MATCH (e:Emp) RETURN e.dept AS dept, count(e.years) AS n
      """
    Then the result should be, in any order:
      | dept | n |
      | 'x'  | 2 |
      | 'y'  | 2 |
    And no side effects

  Scenario: sum and avg per group
    When executing query:
      """
      MATCH (e:Emp) RETURN e.dept AS dept, sum(e.salary) AS s, avg(e.salary) AS a
      """
    Then the result should be, in any order:
      | dept | s   | a    |
      | 'x'  | 30  | 15.0 |
      | 'y'  | 110 | 36.666666666666664 |
    And no side effects

  Scenario: min and max over strings
    When executing query:
      """
      MATCH (e:Emp) RETURN min(e.name) AS lo, max(e.name) AS hi
      """
    Then the result should be, in any order:
      | lo  | hi  |
      | 'a' | 'e' |
    And no side effects

  Scenario: count DISTINCT property
    When executing query:
      """
      MATCH (e:Emp) RETURN count(DISTINCT e.salary) AS n
      """
    Then the result should be, in any order:
      | n |
      | 4 |
    And no side effects

  Scenario: sum DISTINCT property
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'y' RETURN sum(DISTINCT e.salary) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 70 |
    And no side effects

  Scenario: collect DISTINCT
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'y'
      RETURN collect(DISTINCT e.salary) AS vals
      """
    Then the result should be, in any order (ignoring element order for lists):
      | vals     |
      | [30, 40] |
    And no side effects

  Scenario: collect skips nulls
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'y'
      RETURN collect(e.years) AS ys
      """
    Then the result should be, in any order (ignoring element order for lists):
      | ys     |
      | [5, 2] |
    And no side effects

  Scenario: Aggregation over an empty match yields one global row
    When executing query:
      """
      MATCH (e:Emp) WHERE e.salary > 1000 RETURN count(*) AS n, sum(e.salary) AS s
      """
    Then the result should be, in any order:
      | n | s |
      | 0 | 0 |
    And no side effects

  Scenario: Grouped aggregation over an empty match yields no rows
    When executing query:
      """
      MATCH (e:Emp) WHERE e.salary > 1000
      RETURN e.dept AS dept, count(*) AS n
      """
    Then the result should be empty
    And no side effects

  Scenario: min of an absent property is null
    When executing query:
      """
      MATCH (e:Emp) WHERE e.name = 'd' RETURN min(e.years) AS m
      """
    Then the result should be, in any order:
      | m    |
      | null |
    And no side effects

  Scenario: avg of integers is a float
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'x' RETURN avg(e.years) AS a
      """
    Then the result should be, in any order:
      | a   |
      | 2.0 |
    And no side effects

  Scenario: percentileDisc over the group
    When executing query:
      """
      MATCH (e:Emp) RETURN percentileDisc(e.salary, 0.5) AS p
      """
    Then the result should be, in any order:
      | p  |
      | 30 |
    And no side effects

  Scenario: percentileCont interpolates
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'x'
      RETURN percentileCont(e.salary, 0.5) AS p
      """
    Then the result should be, in any order:
      | p    |
      | 15.0 |
    And no side effects

  Scenario: Aggregate of an expression
    When executing query:
      """
      MATCH (e:Emp) RETURN sum(e.salary * 2) AS s
      """
    Then the result should be, in any order:
      | s   |
      | 280 |
    And no side effects

  Scenario: Grouping key expression via WITH
    When executing query:
      """
      MATCH (e:Emp) WITH e.salary / 20 AS bucket, e.name AS name
      RETURN bucket, count(*) AS n
      """
    Then the result should be, in any order:
      | bucket | n |
      | 0      | 1 |
      | 1      | 2 |
      | 2      | 2 |
    And no side effects

  Scenario: stDev of a two-value group
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'x' RETURN stDev(e.salary) AS sd
      """
    Then the result should be, in any order:
      | sd                |
      | 7.0710678118654755 |
    And no side effects

  Scenario: stDevP of a two-value group
    When executing query:
      """
      MATCH (e:Emp) WHERE e.dept = 'x' RETURN stDevP(e.salary) AS sd
      """
    Then the result should be, in any order:
      | sd  |
      | 5.0 |
    And no side effects
